from .model import Kandinsky5Config, Kandinsky5Image, Kandinsky5Transformer, Kandinsky5Video
