"""Entity-tracking query surface (round 2).

Covers the reference's regulation-zone (ZR) tracking and the P48-driven
technology-dimension maintenance:

- ``tracking/ZR_tracking.py`` — BSP/regulation-zone entity dimension with
  change detection and dated history.
- ``tecnologias_generacion/p48_tecnologias_generacion.py`` — updating the
  generation-technology dimension from P48-shaped observations.

Queries are registered here via :func:`~.catalog.register`; implementations
live in ``operators/tracking.py`` / ``operators/zr.py``.
"""

from __future__ import annotations
