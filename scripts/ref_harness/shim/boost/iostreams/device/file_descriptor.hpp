#ifndef CK_REF_SHIM_IOSTREAMS_FD_HPP
#define CK_REF_SHIM_IOSTREAMS_FD_HPP

namespace boost {
namespace iostreams {

enum fd_flags { never_close_handle = 0 };

class file_descriptor_source {
public:
    file_descriptor_source(int, fd_flags) {}
};

}  // namespace iostreams
}  // namespace boost

#endif
