# Verification entry points, tuned for this 1-core host (execution on the
# virtual CPU mesh serializes; the slow tier must run in chunks or an
# 8-device conv backward monopolizes the box for ~7 min per test).
#
# Measured wall times (round 3, uncontended): fast ~3 min; slow chunks
# ~11 + ~2 + ~1.5 + ~3 min.  `make verify` runs everything (~20 min).

PY ?= python

.PHONY: verify fast slow slow-engines slow-learning slow-operating slow-parity

fast:
	$(PY) -m pytest tests/ -q -m "not slow"

slow-engines:
	$(PY) -m pytest tests/test_engines.py tests/test_mask_rcnn.py \
	  tests/test_tracker.py tests/test_train_loop.py -q -m slow

slow-learning:
	$(PY) -m pytest tests/test_learning_regression.py tests/test_pallas_remap.py -q

slow-operating:
	$(PY) -m pytest tests/test_aruco_operating_point.py -q

slow-parity:
	$(PY) -m pytest tests/test_reference_parity.py -q

slow: slow-engines slow-learning slow-operating slow-parity

verify: fast slow
