from show_and_tell_tpu.ops.lstm import (  # noqa: F401
    init_lstm_params,
    lstm_cell,
    lstm_cell_reference,
    set_pallas_enabled,
)
from show_and_tell_tpu.ops.attention import (  # noqa: F401
    additive_attention,
    init_attention_params,
)
