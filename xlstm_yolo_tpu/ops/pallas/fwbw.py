"""Registration of the Pallas TPU kernels into the kernel registry."""

from xlstm_yolo_tpu.ops.backend import register_kernel
from xlstm_yolo_tpu.ops.pallas.chunkwise import mlstm_siging_chunkwise_pallas

register_kernel("chunkwise", "pallas_xl_chunk_siging", mlstm_siging_chunkwise_pallas)
from xlstm_yolo_tpu.ops.pallas.chunkwise_v2 import mlstm_siging_chunkwise_pallas_v2

register_kernel("chunkwise", "pallas_xl_chunk_siging_v2", mlstm_siging_chunkwise_pallas_v2)
from xlstm_yolo_tpu.ops.pallas.step import mlstm_siging_step_pallas

register_kernel("step", "pallas", mlstm_siging_step_pallas)
from xlstm_yolo_tpu.ops.pallas.chunkwise_exp import mlstm_chunkwise_exp_pallas

register_kernel("chunkwise", "pallas_xl_chunk", mlstm_chunkwise_exp_pallas)
from xlstm_yolo_tpu.ops.pallas.parallel import mlstm_siging_parallel_pallas

register_kernel("parallel", "pallas_limit_headdim", mlstm_siging_parallel_pallas)
