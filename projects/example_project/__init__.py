"""Example extension project (the reference's ``projects/example_project``
contract): import this package and its components self-register, so configs
can name them by string."""
from projects.example_project.dummy_backbone import DummyResNet

__all__ = ['DummyResNet']
