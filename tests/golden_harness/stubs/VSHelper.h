/* VSHelper (v3 name) stub: same content as VSHelper4.h. */
#ifndef VSHELPER_H_STUB
#define VSHELPER_H_STUB
#include "VSHelper4.h"
#endif
