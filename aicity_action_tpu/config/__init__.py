from .node import CfgNode
from .defaults import get_cfg, assert_and_infer_cfg
from .parser import parse_args, load_config

__all__ = ["CfgNode", "get_cfg", "assert_and_infer_cfg", "parse_args", "load_config"]
