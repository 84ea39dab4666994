"""Lineage manifests + checkpoint/resume for pipeline stages."""
