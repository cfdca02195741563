"""Deep front-end models (Flax): SuperPoint, SuperGlue, LightGlue, NetVLAD.

TPU-native ports of the torch/CUDA models the reference wraps
(thirdparty/SuperGluePretrainedNetwork, thirdparty/LightGlue, hloc NetVLAD).
Each module ships a torch-checkpoint weight converter; with no checkpoint the
models run with random init (architecture-complete, shape/compile tested).
"""
