"""aicity_action_tpu — TPU-native video understanding framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
JunweiLiang/aicity_action (modified PySlowFast + MViT-v2 for the AI City
2022 Track 3 naturalistic driving action recognition challenge).
"""

__version__ = "0.1.0"
