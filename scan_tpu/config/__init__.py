from .defaults import cfg, get_default_cfg
from .node import ConfigNode
from .paths_catalog import DatasetCatalog

__all__ = ["cfg", "get_default_cfg", "ConfigNode", "DatasetCatalog"]
