"""Model classes: multi-class filter, SVM-headed species, single-filter genus, MLST."""
