from ieagan_tpu.utils.logging import Logger, MetricsLogger
from ieagan_tpu.utils.run_dirs import initialize_directories, write_metadata
from ieagan_tpu.utils.checkpoint import (
    save_checkpoint, load_checkpoint, latest_checkpoint)
from ieagan_tpu.utils.sampling import (
    sample_z, sample_y, trunc_trick, sample_sheet, interp, interp_sheet,
    generate_images, accumulate_standing_stats)
from ieagan_tpu.utils.plot import (
    plot_sim_heatmap, plot_imgs, cosine_similarity_matrix)
from ieagan_tpu.utils.log_read import (
    read_metric_log, read_all_metric_logs, read_jsonl, sv_spectra)
