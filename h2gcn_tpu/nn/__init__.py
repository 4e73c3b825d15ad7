"""Model layer: the layer-DSL compiler, functional network, metrics."""

from .dsl import Layer, parse_network_setup
from .model import NetworkModel
from .metrics import masked_softmax_cross_entropy, masked_accuracy

__all__ = [
    "Layer",
    "parse_network_setup",
    "NetworkModel",
    "masked_softmax_cross_entropy",
    "masked_accuracy",
]
