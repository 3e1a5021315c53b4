"""The file you hand to spark-submit; the package rides in --py-files.

    spark-submit --master <cluster> \
        --py-files tglp_spark.zip \
        spark_job.py --input <token table> --output <dir> --checkpoint <dir>

Build the zip with
``team_goldo_combat_log_parser_spark.runner.shipping.make_pyfiles_zip``.
This launcher is deliberately import-light: the package resolves from
the --py-files zip (driver and executors alike), so the cluster needs no
repo checkout.
"""

import sys

from team_goldo_combat_log_parser_spark.runner.cli import main

if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
