from onnx_quantize_tpu.utils.tree import copy_tree, tree_get, untie_params

__all__ = ["tree_get", "copy_tree", "untie_params"]
