from show_and_tell_tpu.models.show_tell import ShowTellModel  # noqa: F401
from show_and_tell_tpu.models.show_attend_tell import ShowAttendTellModel  # noqa: F401
from show_and_tell_tpu.models.registry import build_model  # noqa: F401
