from particlesimulation_tpu.cli import main

raise SystemExit(main())
