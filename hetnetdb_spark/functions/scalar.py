"""Placeholder — operators land in a subsequent commit."""
