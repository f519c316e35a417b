from ieagan_tpu.utils.logging import Logger, MetricsLogger
from ieagan_tpu.utils.run_dirs import initialize_directories, write_metadata
from ieagan_tpu.utils.checkpoint import (
    save_checkpoint, load_checkpoint, latest_checkpoint)
