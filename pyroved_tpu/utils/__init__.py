"""Core utilities: coordinate math, data pipeline, NN helpers, viz, GP."""
from .coord import (generate_grid, generate_latent_grid,
                    generate_latent_grid_traversal, grid2xy, imcoordgrid,
                    rotate_coordinates, scale_coordinates,
                    transform_coordinates)
from .data import DataLoader, init_dataloader, init_ssvae_dataloaders
from .nn import (as_numpy, average_weights, concat_features, get_activation,
                 set_deterministic_mode, to_onehot)

__all__ = [
    "generate_grid", "generate_latent_grid", "generate_latent_grid_traversal",
    "grid2xy", "imcoordgrid", "rotate_coordinates", "scale_coordinates",
    "transform_coordinates", "DataLoader", "init_dataloader",
    "init_ssvae_dataloaders", "as_numpy", "average_weights",
    "concat_features", "get_activation", "set_deterministic_mode", "to_onehot",
]
