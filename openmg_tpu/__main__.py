from openmg_tpu.cli import main

raise SystemExit(main())
