"""Multimodal columns: binary image/audio/video payloads + typed
metadata, processed via Arrow-batched pandas UDFs."""
