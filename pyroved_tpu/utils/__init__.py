"""Core utilities: coordinate math, data pipeline, NN helpers, viz, GP,
checkpointing, profiling."""
from ..infer.dists import get_sampler
from .checkpoint import load_checkpoint, save_checkpoint
from .coord import (generate_grid, generate_latent_grid,
                    generate_latent_grid_traversal, grid2xy, imcoordgrid,
                    rotate_coordinates, scale_coordinates,
                    transform_coordinates)
from .data import DataLoader, init_dataloader, init_ssvae_dataloaders, prefetch
from .gp import GPRegression, gp_model
from .nn import (Concat, as_numpy, average_weights, concat_features,
                 get_activation, get_bnorm, get_conv, get_maxpool,
                 set_deterministic_mode, to_onehot)
from .profiling import Timer, trace
from .viz import (make_img_grid, plot_grid_traversal, plot_img_grid,
                  plot_latent_predictions, plot_spect_grid)

__all__ = [
    "generate_grid", "generate_latent_grid", "generate_latent_grid_traversal",
    "grid2xy", "imcoordgrid", "rotate_coordinates", "scale_coordinates",
    "transform_coordinates", "DataLoader", "init_dataloader",
    "init_ssvae_dataloaders", "prefetch", "as_numpy", "average_weights", "Concat",
    "concat_features", "get_activation", "get_bnorm", "get_conv",
    "get_maxpool", "set_deterministic_mode", "to_onehot", "get_sampler",
    "GPRegression", "gp_model", "save_checkpoint", "load_checkpoint",
    "Timer", "trace", "make_img_grid", "plot_img_grid", "plot_spect_grid",
    "plot_grid_traversal", "plot_latent_predictions",
]
