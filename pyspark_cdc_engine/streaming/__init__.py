"""Streaming layer: stateful transaction assembly + pipeline wiring."""
