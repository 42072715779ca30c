from .visualizer import LearningVisualizer, colormap_rdylbu
