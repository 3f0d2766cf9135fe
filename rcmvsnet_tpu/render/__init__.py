from .rays import sample_rays, build_color_volume, index_point_feature
from .volume_render import volumetric_render, depth2dist
