from ieagan_tpu.data.dataset import ImageEventsDataset, load_dataset, event_transform
from ieagan_tpu.data.pipeline import EventLoader, synthetic_events
from ieagan_tpu.data.transforms import (
    UniformNoise, GaussianNoise, CenterCropLongEdge, RandomCropLongEdge,
    BalancedSampler,
)
