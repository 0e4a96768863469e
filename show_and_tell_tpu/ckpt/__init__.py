from show_and_tell_tpu.ckpt.checkpoint import (  # noqa: F401
    load_best_params,
    load_infos,
    load_train_state,
    save_best,
    save_infos,
    save_train_state,
)
