from .model import HiDream
