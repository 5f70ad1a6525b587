"""Multimodal (image/audio/video-as-binary) column support."""
