from .occupancy import (CulledRenderer, OccupancyGrid, build_occupancy_grid,
                        ray_box_hits)
from .render import (ModelConfig, RenderConfig, render_rays,
                     render_rays_chunked, volume_quadrature)

__all__ = ["ModelConfig", "RenderConfig", "render_rays",
           "render_rays_chunked", "volume_quadrature",
           "OccupancyGrid", "build_occupancy_grid", "ray_box_hits",
           "CulledRenderer"]
