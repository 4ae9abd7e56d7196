from kvzip_tpu.data.loaders import load_dataset_all
from kvzip_tpu.data.wrapper import DataWrapper, get_query

__all__ = ["load_dataset_all", "DataWrapper", "get_query"]
