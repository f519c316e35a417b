from ieagan_tpu.parallel.sharding import (
    param_shardings, batch_shardings, make_sharded_train_step, replicate,
)
