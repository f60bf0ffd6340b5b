# populated by datasets.utils and datasets.voc
