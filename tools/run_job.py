#!/usr/bin/env python
"""spark-submit driver shim: the zip shipped via --py-files contains the
``pdf_parser_spark`` package; this file is the submittable script.

    spark-submit --py-files build/engine.zip tools/run_job.py \
        --input /data/pages --output /data/out [--resume]
"""

import sys

from pdf_parser_spark.__main__ import main

if __name__ == "__main__":
    sys.exit(main())
