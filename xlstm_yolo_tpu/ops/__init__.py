"""mLSTM compute kernels: jnp references, chunkwise scans, Pallas TPU kernels."""

from xlstm_yolo_tpu.ops.backend import (  # noqa: F401
    get_mlstm_kernel,
    make_backend,
    mLSTMBackendConfig,
    register_kernel,
)
from xlstm_yolo_tpu.ops.mlstm_chunkwise import (  # noqa: F401
    mlstm_chunkwise_stabilized,
    mlstm_siging_chunkwise,
)
from xlstm_yolo_tpu.ops.mlstm_parallel import (  # noqa: F401
    mlstm_parallel_stabilized,
    mlstm_siging_parallel,
)
from xlstm_yolo_tpu.ops.mlstm_recurrent import (  # noqa: F401
    mlstm_siging_recurrent_sequence,
    mlstm_siging_step,
)
