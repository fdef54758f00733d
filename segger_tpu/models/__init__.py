from .gatv2 import GATv2Conv
from .encoder import ISTEncoder, HeteroGATLayer
from .positional import Positional2dEmbedder, sinusoidal_embedding
from . import losses

__all__ = [
    "GATv2Conv",
    "ISTEncoder",
    "HeteroGATLayer",
    "Positional2dEmbedder",
    "sinusoidal_embedding",
    "losses",
]
