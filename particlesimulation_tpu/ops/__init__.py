"""Physics ops: binning, COM, stencil, forces, integration, collisions.

The reference's L2 ops layer (SURVEY §1) rebuilt as pure array functions over
the sorted-particle representation.
"""
