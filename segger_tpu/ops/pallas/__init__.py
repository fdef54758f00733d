from .gatv2_attn import gatv2_attention, pallas_available

__all__ = ["gatv2_attention", "pallas_available"]
