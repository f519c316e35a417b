from ieagan_tpu.eval.fid import (
    compute_fid, compute_fid_from_state, make_custom_stats, frechet_distance,
    compute_kid, make_custom_kid_stats,
    kernel_distance, FeatureExtractor, fid_postprocess, trunc_trick,
    get_model_features, get_folder_features, make_generator_fn,
    get_reference_statistics,
)
from ieagan_tpu.eval.physics import (
    get_stats, generate_event_stream, real_event_stream, compare_models,
    EventStats, log_transform_inv, THRESHOLD,
)
from ieagan_tpu.eval.inception import (
    InceptionV3Features, convert_torch_state_dict,
)
