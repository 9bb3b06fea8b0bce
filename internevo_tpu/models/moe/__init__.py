from .gshard import moe_layer_apply, top1gating, top2gating

__all__ = ["moe_layer_apply", "top1gating", "top2gating"]
