"""Reusable engine operators (the building blocks queries compose)."""
