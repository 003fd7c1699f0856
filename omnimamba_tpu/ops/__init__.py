from omnimamba_tpu.ops.conv import (  # noqa: F401
    causal_conv1d,
    causal_conv1d_step,
    conv_state_from_sequence,
)
from omnimamba_tpu.ops.norms import (  # noqa: F401
    add_norm,
    gated_rms_norm,
    layer_norm,
    rms_norm,
)
from omnimamba_tpu.ops.sampling import SampleParams, sample_token  # noqa: F401
from omnimamba_tpu.ops.ssd_chunked import ssd_chunked  # noqa: F401
from omnimamba_tpu.ops.ssd_reference import ssd_scan_reference, ssd_step  # noqa: F401
