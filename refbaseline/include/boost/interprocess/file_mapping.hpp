#pragma once
// Only referenced by readfambed, whose body the refbaseline patch stubs out.
namespace boost { namespace interprocess {}}
