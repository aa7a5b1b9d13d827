from .build import (
    DetectionLoader,
    build_dataset,
    make_data_loader_source,
    make_data_loader_target,
    make_data_loader_test,
    make_data_loader_train,
)

# reference-name alias (fcos_core.data.make_data_loader)
make_data_loader = make_data_loader_test

__all__ = [
    "DetectionLoader",
    "build_dataset",
    "make_data_loader",
    "make_data_loader_source",
    "make_data_loader_target",
    "make_data_loader_test",
    "make_data_loader_train",
]
