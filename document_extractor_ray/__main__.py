from document_extractor_ray.cli import main
import sys

sys.exit(main())
