from .inference import compute_predictions, evaluate_dataset, inference
from .train_step import make_da_train_step, make_source_only_train_step
from .trainer import do_train_da, do_train_plain

# reference-name aliases (fcos_core.engine.validation / trainer)
validation = inference
validataion = inference  # [sic] the reference's spelling, kept as an alias

__all__ = [
    "compute_predictions",
    "evaluate_dataset",
    "inference",
    "make_da_train_step",
    "make_source_only_train_step",
    "do_train_da",
    "do_train_plain",
    "validation",
    "validataion",
]
