"""Headline relational query library over the driver testdata tables."""
