"""Stateful SLAM components wiring the device kernels into the pipeline.

Mirrors the reference's frontend/backend/dataproxy object graph (SURVEY.md
§1) with host-side state (keyframe stores, deques, events) around jitted
device compute.
"""
