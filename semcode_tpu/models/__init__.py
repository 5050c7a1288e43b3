"""On-TPU neural models: the transformer embedding encoder and its training."""

from .encoder import CodeEncoder, EncoderConfig, EncoderEmbeddings

__all__ = ["CodeEncoder", "EncoderConfig", "EncoderEmbeddings"]
