"""Neural-net modules (flax.linen)."""
from .conv import (FeatureExtractor, UpsampleBlock, Upsampler, convDecoderNet,
                   convEncoderNet)
from .fc import (Dense, MLP, coord_latent, fcClassifierNet, fcDecoderNet,
                 fcEncoderNet, fcRegressorNet, jfcEncoderNet, sDecoderNet)

__all__ = [
    "fcEncoderNet", "jfcEncoderNet", "fcDecoderNet", "sDecoderNet",
    "coord_latent", "fcClassifierNet", "fcRegressorNet", "Dense", "MLP",
    "convEncoderNet", "convDecoderNet", "FeatureExtractor", "Upsampler",
    "UpsampleBlock",
]
