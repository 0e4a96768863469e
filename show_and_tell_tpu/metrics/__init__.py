from show_and_tell_tpu.metrics.tokenizer import PTBTokenizer  # noqa: F401
from show_and_tell_tpu.metrics.bleu import Bleu  # noqa: F401
from show_and_tell_tpu.metrics.cider import Cider  # noqa: F401
from show_and_tell_tpu.metrics.rouge import Rouge  # noqa: F401
from show_and_tell_tpu.metrics.meteor import Meteor  # noqa: F401
from show_and_tell_tpu.metrics.spice import Spice  # noqa: F401
from show_and_tell_tpu.metrics.coco import COCO  # noqa: F401
from show_and_tell_tpu.metrics.orchestrator import COCOEvalCap  # noqa: F401
