from ieagan_tpu.deploy.inference import (
    Model, generate, generate_batched, FROZEN_CONFIG,
    resolve_generator_checkpoint)
from ieagan_tpu.deploy.producer import (
    extract_sparse_digits, EventProducer, NpzWriter, produce_events)
