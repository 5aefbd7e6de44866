from lednet_tpu.visualization.local_visualizer import SegLocalVisualizer

__all__ = ['SegLocalVisualizer']
