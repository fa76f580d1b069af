"""Operator library: DataFrame in → DataFrame out, no driver-side collects."""
