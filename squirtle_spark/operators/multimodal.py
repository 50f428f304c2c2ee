"""Multimodal (binary) column plumbing with stubbed decoders."""
