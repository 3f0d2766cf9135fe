from .registry import find_dataset_def
