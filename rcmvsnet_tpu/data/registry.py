"""Dataset registry: string → dataset class, mirroring
/root/reference/datasets/__init__.py:4-7."""
from __future__ import annotations

import importlib

_ALIASES = {
    "dtu_train": ("rcmvsnet_tpu.data.dtu_train", "DTUTrainDataset"),
    "dtu_yao": ("rcmvsnet_tpu.data.dtu_val", "DTUValDataset"),
    "dtu_test": ("rcmvsnet_tpu.data.dtu_test", "DTUTestDataset"),
    "tanks": ("rcmvsnet_tpu.data.tanks", "TanksDataset"),
    "synthetic": ("rcmvsnet_tpu.data.synthetic_dataset", "SyntheticDataset"),
}


def find_dataset_def(name: str):
    module_name, cls_name = _ALIASES[name]
    module = importlib.import_module(module_name)
    return getattr(module, cls_name)
