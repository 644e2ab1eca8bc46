"""Pallas TPU kernels for the hot compute paths."""
from .spatial_decoder import fused_spatial_decoder, spatial_decoder_reference

__all__ = ["fused_spatial_decoder", "spatial_decoder_reference"]
