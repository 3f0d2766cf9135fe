from .layers import ConvBNAct, DeconvBNAct, torch_kernel_init, torch_bias_init
from .featurenet import FeatureNet
from .costreg import CostRegNet
from .mlp import NerfMLP, positional_encoding
from .neural_volume import NeuralVolumeNet
