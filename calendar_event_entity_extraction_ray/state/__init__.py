"""Checkpoint manifests, lineage, and metrics manifests."""
