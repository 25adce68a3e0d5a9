from .occupancy import (CulledRenderer, OccupancyGrid, auto_ranges,
                        build_occupancy_grid, load_or_build_grid, pick_block,
                        ray_box_hits, rays_aabb, resolve_ranges,
                        weight_block_map_from_sigma)
from .render import (ModelConfig, RenderConfig, render_rays,
                     render_rays_chunked, volume_quadrature)

__all__ = ["ModelConfig", "RenderConfig", "render_rays",
           "render_rays_chunked", "volume_quadrature",
           "OccupancyGrid", "build_occupancy_grid", "ray_box_hits",
           "CulledRenderer", "auto_ranges", "load_or_build_grid",
           "pick_block", "rays_aabb", "resolve_ranges",
           "weight_block_map_from_sigma"]
