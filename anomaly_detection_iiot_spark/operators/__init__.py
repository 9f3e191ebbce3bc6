"""Operator library — the engine's public surface.

Each module re-expresses one family from SURVEY.md §2 as DataFrame
transforms. Operators take/return DataFrames and never collect; anything
driver-side (FedAvg round loop) is explicitly documented as such.
"""
