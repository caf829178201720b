"""Structured Streaming attachment for continuous views."""
