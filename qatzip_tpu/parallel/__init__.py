"""Distributed layer: block-data-parallel sharding over TPU meshes."""
