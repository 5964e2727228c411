#!/usr/bin/env python
"""spark-submit entrypoint (J8, north-rule deployment shape):

    zip -r pyimgtk_spark.zip py_image_toolkit_spark
    spark-submit --py-files pyimgtk_spark.zip job.py extract \\
        --input /data/pages --output /data/extractions

See py_image_toolkit_spark/cli.py for subcommands and options."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from py_image_toolkit_spark.cli import main  # noqa: E402

if __name__ == "__main__":
    sys.exit(main())
