"""Configs, stats, logging, simulation utilities."""
