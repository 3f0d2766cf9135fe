from .cascade import CascadeMVSNet
from .render_net import RenderingConsistencyNet
