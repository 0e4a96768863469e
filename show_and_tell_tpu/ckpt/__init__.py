from show_and_tell_tpu.ckpt.checkpoint import (  # noqa: F401
    load_best_params,
    load_infos,
    save_best,
    save_infos,
)
