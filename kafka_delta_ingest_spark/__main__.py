from kafka_delta_ingest_spark.cli import main

raise SystemExit(main())
