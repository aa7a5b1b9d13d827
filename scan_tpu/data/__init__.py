from .build import (
    DetectionLoader,
    build_dataset,
    build_datasets,
    make_data_loader_source,
    make_data_loader_target,
    make_data_loader_test,
    make_data_loaders_test,
    make_data_loader_train,
)
from .datasets.concat import ConcatDataset

# reference-name alias (fcos_core.data.make_data_loader)
make_data_loader = make_data_loader_test

__all__ = [
    "ConcatDataset",
    "DetectionLoader",
    "build_dataset",
    "build_datasets",
    "make_data_loader",
    "make_data_loader_source",
    "make_data_loader_target",
    "make_data_loader_test",
    "make_data_loaders_test",
    "make_data_loader_train",
]
