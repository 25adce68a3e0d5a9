from .embedding import EmbeddingConfig, embed, embedding_out_channels
from .nerf import NeRFConfig, init_nerf_params, nerf_apply, nerf_param_count

__all__ = [
    "EmbeddingConfig", "embed", "embedding_out_channels",
    "NeRFConfig", "init_nerf_params", "nerf_apply", "nerf_param_count",
]
