"""Protobuf-runtime shim package; see sitecustomize.py in this dir."""
