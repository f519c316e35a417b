from ieagan_tpu.core.config import DEFAULT_CONFIG, load_config, event_size
from ieagan_tpu.core.precision import Policy, get_policy
from ieagan_tpu.core.mesh import make_mesh, data_sharding, replicate_sharding
