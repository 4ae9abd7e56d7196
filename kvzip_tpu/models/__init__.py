from kvzip_tpu.models.transformer import forward
from kvzip_tpu.models.params import init_params, load_hf_params

__all__ = ["forward", "init_params", "load_hf_params"]
