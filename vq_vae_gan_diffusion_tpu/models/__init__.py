from .blocks import (DownsampleBlock, GroupNorm, NonLocalBlock, ResidualBlock,
                     UpsampleBlock, swish)
from .codebook import CodeBook, nearest_codebook_indices, quantize
from .decoder import Decoder
from .discriminator import Discriminator
from .encoder import Encoder
from .vae import VAE
from .vqvae import VQVAE, adopt_weight

__all__ = [
    "DownsampleBlock", "GroupNorm", "NonLocalBlock", "ResidualBlock",
    "UpsampleBlock", "swish", "CodeBook", "nearest_codebook_indices",
    "quantize", "Decoder", "Discriminator", "Encoder", "VAE", "VQVAE",
    "adopt_weight",
]
