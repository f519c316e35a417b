from ieagan_tpu.deploy.inference import Model, generate, FROZEN_CONFIG
