from show_and_tell_tpu.train.losses import masked_cross_entropy  # noqa: F401
from show_and_tell_tpu.train.schedule import lr_for_epoch, ss_prob_for_epoch  # noqa: F401
from show_and_tell_tpu.train.step import TrainState, make_train_state, make_train_step  # noqa: F401
from show_and_tell_tpu.train.trainer import Trainer  # noqa: F401
