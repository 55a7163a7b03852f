from .weights import convert_qwen2_state_dict

__all__ = ["convert_qwen2_state_dict"]
