"""Matcher model families: gim_lightglue, gim_loftr, gim_dkm, gim_roma."""
