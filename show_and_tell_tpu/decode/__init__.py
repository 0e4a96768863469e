from show_and_tell_tpu.decode.greedy import greedy_decode  # noqa: F401
from show_and_tell_tpu.decode.beam import beam_search  # noqa: F401
from show_and_tell_tpu.decode.sample import sample_decode  # noqa: F401
from show_and_tell_tpu.decode.dispatch import decode_ids  # noqa: F401
