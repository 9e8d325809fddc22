"""Experimental prototypes: measured, decision-recorded, NOT on any shipping
path. See docs/ARCHITECTURE.md (roofline / fused-kernel study) for why each
lives here instead of eincm_tpu.ops."""
