from kvzip_tpu.utils.profiling import TimeStamp, device_mem_gb
from kvzip_tpu.utils.io import save_result, set_gen_length

__all__ = ["TimeStamp", "device_mem_gb", "save_result", "set_gen_length"]
