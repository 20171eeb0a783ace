"""Application backbones (reference ku/applications_ext/__init__.py:1-2)."""

from ku.applications_ext.nobody_convnet2d import NobodyConvNet2D
from ku.applications_ext.nobody_convnet3d import NobodyConvNet3D
