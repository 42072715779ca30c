from .dino import DinoInterface
from .feature_extractor import Extraction, FeatureExtractor
from .sift import dense_sift_channel, dense_sift_features
from .stego import StegoInterface
from .torchvision_interface import TorchVisionInterface
