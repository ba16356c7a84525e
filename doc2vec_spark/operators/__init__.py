"""Operator library: each module contributes oracle-checked QuerySpecs."""
