"""Placeholder — queries added in a later milestone this round."""
