"""Minimal shim so the reference package imports without timm installed."""
