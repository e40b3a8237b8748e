"""Multi-device scaling: mesh construction and sharding layouts.

The reference is single-GPU with no distributed backend (SURVEY.md §2.2).
The TPU-native scale-out story exploits the structure of the workload: the
object bank is embarrassingly parallel over the object axis (expert-parallel
in spirit — hard routing by instance id), and the background/iMAP field is
data-parallel over rays. XLA inserts the collectives (psum of background
gradients over the data axis) from sharding annotations alone.
"""
