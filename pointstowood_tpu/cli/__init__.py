"""Command-line entry points (installed as console scripts; the repo-root
``predict.py`` / ``train.py`` shims keep the reference's ``python
predict.py ...`` invocation working, reference predict.py:59 / train.py:56).
"""
